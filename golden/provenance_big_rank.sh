#!/bin/bash
# Reference-CPU throughput baseline for the bigRank bench workload.
#
# Writes bench.make_big_rank()'s EXACT synthetic (KDD-Cup table
# geometry, 25k active users x (20 pos + 60 neg) "3N" rows, labels
# pre-scaled like make_ugroup_buffer -scale_score) via the
# byte-compatible buffer writer, then times the reference binary's
# pairwise-rank training (model_type=1, active_type=3 — runtime pair
# generation per round, apex_svd_data.cpp:812-1025) on tmpfs:
#
#   per-round sec = min over 3 reps of (T(num_round=4) - T(num_round=1)) / 3
#
# pairs/s = pairs_per_round / per_round_sec, with pairs_per_round taken
# from the SAME deterministic count formula both sides implement (the
# bench records it as pairs_per_round).  Result -> GOLDEN.json["bigRank"].
set -e
cd "$(dirname "$0")/.."
WORK=/dev/shm/big_rank
mkdir -p $WORK

PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python - <<EOF
import bench
from svdfeature_tpu.data.buffer import write_plus_buffer
from svdfeature_tpu.data.rank import PairSource
from svdfeature_tpu.data.registry import IteratorConfig
pds, dims = bench.make_big_rank()
print("rows", dims["EX"])
print("pairs_per_round",
      PairSource(pds, IteratorConfig()).epoch_dataset().rows.num_row)
write_plus_buffer("$WORK/buffer.base.svdpp", pds)
open("$WORK/big_rank.conf", "w").write(f"""
learning_rate = 0.005
wd_item = 0.004
wd_user = 0.004
num_item = {dims['NI']}
num_user = {dims['NU']}
num_global = 0
num_factor = {dims['KF']}
active_type = 3
format_type = 1
model_type = 1
num_ufeedback = {dims['NF']}
wd_ufeedback = 0.004
no_user_bias = 1
input_type = 2
buffer_feature = "buffer.base.svdpp"
model_out_folder = "./"
""")
EOF

BIN=$(pwd)/.baseline/svd_feature
cd $WORK
BEST=
for rep in 1 2 3; do
  rm -f *.model
  S=$(date +%s.%N); $BIN big_rank.conf num_round=1 silent=1; E=$(date +%s.%N)
  T1=$(awk -v s="$S" -v e="$E" 'BEGIN{print e-s}')
  rm -f *.model
  S=$(date +%s.%N); $BIN big_rank.conf num_round=4 silent=1; E=$(date +%s.%N)
  T4=$(awk -v s="$S" -v e="$E" 'BEGIN{print e-s}')
  R=$(awk -v a="$T1" -v b="$T4" 'BEGIN{print (b-a)/3}')
  echo "rep $rep: T1=$T1 T4=$T4 per_round=$R"
  BEST=$(awk -v r="$R" -v b="${BEST:-1e30}" 'BEGIN{print (r<b)?r:b}')
done
echo "best_per_round_s $BEST"
