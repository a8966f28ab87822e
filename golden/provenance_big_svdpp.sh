#!/bin/bash
# Reference-CPU throughput baseline for the bigSvdpp bench workload.
#
# Writes bench.make_big_plus()'s EXACT synthetic (numpy default_rng(0):
# 100k users x 200k items x 200k feedback ids, ~2M rows, planted rank-8
# structure) to a reference-format user-group buffer via the
# byte-compatible writer, then times the reference binary
# (.baseline/svd_feature, format_type=1, k=64) on tmpfs at steady state:
#
#   per-round sec = min over 3 reps of (T(num_round=4) - T(num_round=1)) / 3
#
# The subtraction removes buffer load + model save, mirroring how
# bench.py's timed window excludes staging.  Result goes to
# golden/GOLDEN.json["bigSvdpp"]["examples_per_sec_cpu"] (by hand, with
# the date + host note, like the bigTable entry).
set -e
cd "$(dirname "$0")/.."
WORK=/dev/shm/big_svdpp
mkdir -p $WORK

PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python - <<EOF
import bench
from svdfeature_tpu.data.buffer import write_plus_buffer
pds, dims = bench.make_big_plus()
print("rows", dims["EX"])
write_plus_buffer("$WORK/buffer.base.svdpp", pds)
open("$WORK/big_svdpp.conf", "w").write(f"""
base_score = 3
learning_rate = 0.005
wd_item = 0.004
wd_user = 0.004
num_item = {dims['NI']}
num_user = {dims['NU']}
num_global = 0
num_factor = {dims['KF']}
active_type = 0
format_type = 1
num_ufeedback = {dims['NF']}
wd_ufeedback = 0.004
buffer_feature = "buffer.base.svdpp"
model_out_folder = "./"
""")
EOF

BIN=$(pwd)/.baseline/svd_feature
cd $WORK
BEST=
for rep in 1 2 3; do
  rm -f *.model
  S=$(date +%s.%N); $BIN big_svdpp.conf num_round=1 silent=1; E=$(date +%s.%N)
  T1=$(awk -v s="$S" -v e="$E" 'BEGIN{print e-s}')
  rm -f *.model
  S=$(date +%s.%N); $BIN big_svdpp.conf num_round=4 silent=1; E=$(date +%s.%N)
  T4=$(awk -v s="$S" -v e="$E" 'BEGIN{print e-s}')
  R=$(awk -v a="$T1" -v b="$T4" 'BEGIN{print (b-a)/3}')
  echo "rep $rep: T1=$T1 T4=$T4 per_round=$R"
  BEST=$(awk -v r="$R" -v b="${BEST:-1e30}" 'BEGIN{print (r<b)?r:b}')
done
echo "best_per_round_s $BEST"
