#!/bin/bash
# Regenerates the reference's golden numbers on ML-100K for all 5 demo workloads.
set -e
cd "$(dirname "$0")/demo"
OUT=/root/repo/golden

### basicMF (ML-100K)
cd basicMF
rm -f *.model ua.base.buffer ua.test.buffer
../../tools/line_shuffle ua.base ua.base.shuffle >/dev/null
python mkbasicfeature.py ua.base.shuffle ua.base.basicfeature >/dev/null
python mkbasicfeature.py ua.test ua.test.basicfeature >/dev/null
../../tools/make_feature_buffer ua.base.basicfeature ua.base.buffer >/dev/null
../../tools/make_feature_buffer ua.test.basicfeature ua.test.buffer >/dev/null
S=$(date +%s.%N)
../../svd_feature basicMF.conf num_round=40 silent=1
E=$(date +%s.%N)
awk -v s="$S" -v e="$E" 'BEGIN{print "train_seconds", e-s}' > $OUT/basicMF.time
../../svd_feature_infer basicMF.conf start=1 end=41 silent=1 log_eval=$OUT/basicMF.rmse.tsv
rm -f $OUT/basicMF.rmse.tsv.bak
cd ..

### binaryClassification (ML-100K, binarized labels rating>=4)
cd binaryClassification
rm -f *.model ua.base.buffer ua.test.buffer
python - <<'PYEOF'
for src, dst in [("../basicMF/ua.base.shuffle","ua.base.bin.feature"), ("../basicMF/ua.test","ua.test.bin.feature")]:
    with open(src) as fi, open(dst,"w") as fo:
        for line in fi:
            a = line.split()
            uid, iid, r = int(a[0]), int(a[1]), int(a[2])
            fo.write("%d\t0\t1\t1\t%d:1 %d:1\n" % (1 if r>=4 else 0, uid-1, iid-1))
PYEOF
../../tools/make_feature_buffer ua.base.bin.feature ua.base.buffer >/dev/null
../../tools/make_feature_buffer ua.test.bin.feature ua.test.buffer >/dev/null
S=$(date +%s.%N)
../../svd_feature binaryClassification.conf num_round=40 silent=1 base_score=0.5
E=$(date +%s.%N)
awk -v s="$S" -v e="$E" 'BEGIN{print "train_seconds", e-s}' > $OUT/binaryClassification.time
../../svd_feature_infer binaryClassification.conf start=1 end=41 silent=1 base_score=0.5 log_eval=$OUT/binaryClassification.rmse.tsv
cd ..

### neighborhoodModel (ML-100K + 6 global popularity-bucket features)
cd neighborhoodModel
rm -f *.model ua.base.buffer ua.test.buffer
python - <<'PYEOF'
from collections import Counter
cnt = Counter()
with open("../basicMF/ua.base") as fi:
    for line in fi:
        a = line.split(); cnt[int(a[1])-1] += 1
def bucket(iid):
    c = cnt.get(iid, 0)
    for b, t in enumerate((1, 5, 20, 80, 320)):
        if c <= t: return b
    return 5
for src, dst in [("../basicMF/ua.base.shuffle","ua.base.nb.feature"), ("../basicMF/ua.test","ua.test.nb.feature")]:
    with open(src) as fi, open(dst,"w") as fo:
        for line in fi:
            a = line.split()
            uid, iid, r = int(a[0]), int(a[1]), int(a[2])
            fo.write("%d\t1\t1\t1\t%d:1 %d:1 %d:1\n" % (r, bucket(iid-1), uid-1, iid-1))
PYEOF
../../tools/make_feature_buffer ua.base.nb.feature ua.base.buffer >/dev/null
../../tools/make_feature_buffer ua.test.nb.feature ua.test.buffer >/dev/null
S=$(date +%s.%N)
../../svd_feature neighborhoodModel.conf num_round=40 silent=1
E=$(date +%s.%N)
awk -v s="$S" -v e="$E" 'BEGIN{print "train_seconds", e-s}' > $OUT/neighborhoodModel.time
../../svd_feature_infer neighborhoodModel.conf start=1 end=41 silent=1 log_eval=$OUT/neighborhoodModel.rmse.tsv
cd ..

### implicitFeedback (SVD++ ML-100K)
cd implicitFeedback
rm -f *.model buffer.base.svdpp buffer.test.svdpp
../../tools/svdpp_randorder ua.base ua.base.order >/dev/null
../../tools/line_reorder ua.base ua.base.order ua.base.group >/dev/null
python mkbasicfeature.py ua.base.group ua.base.group.basicfeature >/dev/null
python mkbasicfeature.py ua.test ua.test.basicfeature >/dev/null
python mkimplicitfeedbackfeature.py ua.base ua.base.group ua.base.feedbackfeature >/dev/null
python mkimplicitfeedbackfeature.py ua.base ua.test ua.test.feedbackfeature >/dev/null
../../tools/make_ugroup_buffer ua.base.group.basicfeature buffer.base.svdpp -fd ua.base.feedbackfeature >/dev/null
../../tools/make_ugroup_buffer ua.test.basicfeature buffer.test.svdpp -fd ua.test.feedbackfeature >/dev/null
S=$(date +%s.%N)
../../svd_feature implicitFeedback.conf num_round=40 silent=1
E=$(date +%s.%N)
awk -v s="$S" -v e="$E" 'BEGIN{print "train_seconds", e-s}' > $OUT/implicitFeedback.time
../../svd_feature_infer implicitFeedback.conf start=1 end=41 silent=1 log_eval=$OUT/implicitFeedback.rmse.tsv
cd ..

### pairwiseRank (ML-100K)
cd pairwiseRank
rm -f *.model buffer.base.svdpp buffer.test.svdpp pred.txt
cp ../implicitFeedback/ua.base.order ua.base.order
../../tools/line_reorder ua.base ua.base.order ua.base.group >/dev/null
python sampleneg.py ua.base.group ua.base.group.3N 3 4 >/dev/null
python mkbasicfeature.py ua.base.group.3N ua.base.group.3N.basicfeature >/dev/null
python mktestrank.py ua.base.group ua.test ua.test.basicfeature >/dev/null
python mkimplicitfeedbackfeature.py ua.base ua.base.group.3N ua.base.group.3N.feedbackfeature >/dev/null
python mkimplicitfeedbackfeaturetest.py ua.test.basicfeature ua.test.feedbackfeature >/dev/null
../../tools/make_ugroup_buffer ua.base.group.3N.basicfeature buffer.base.svdpp -fd ua.base.group.3N.feedbackfeature -scale_score 5 >/dev/null
../../tools/make_ugroup_buffer ua.test.basicfeature buffer.test.svdpp -fd ua.test.feedbackfeature -scale_score 1 -max_block 400 >/dev/null
S=$(date +%s.%N)
../../svd_feature pairwiseRankML100K.conf num_round=40 silent=1
E=$(date +%s.%N)
awk -v s="$S" -v e="$E" 'BEGIN{print "train_seconds", e-s}' > $OUT/pairwiseRank.time
../../svd_feature_infer pairwiseRankML100K.conf pred=40 silent=1
python eval.py pred.txt > $OUT/pairwiseRank.p20.txt
cp pred.txt $OUT/pairwiseRank.pred.txt
cd ..
echo ALL GOLDEN DONE

### bigTable (synthetic KDD-Cup scale; reference-CPU throughput baseline)
# Generates the exact bench.py bigTable synthetic (numpy default_rng(7)),
# builds a binary buffer, and times the reference at steady state:
#   per-round sec = (T(num_round=5) - T(num_round=1)) / 4   on tmpfs.
# Recorded in GOLDEN.json["bigTable"]; see that entry for the 2026-08-18
# measurement (6.357 s/round incl. ~0.21 s model save -> 341k ex/s
# training-only on this host's CPU).
# mkdir -p /dev/shm/bigbase && cd /dev/shm/bigbase
# python3 -c "<write big.feature: label\t0\t1\t1\tu:1 i:1 from rng(7)>"
# $TOOLS/make_feature_buffer big.feature big.buffer -batch_size 1000
# time $BIN/svd_feature big.conf num_round=1 silent=1
# time $BIN/svd_feature big.conf num_round=5 silent=1

### multi_imfb_stacked (genuinely stacked depth-2 taxonomy variant)
# Requires svdfeature_tpu (the stacked buffer is written via its
# byte-compatible writer — interop is part of what the gate pins).
# Per user block: START(user fb, first half rows) keeps the user context
# open, a DEFAULT sub-block (half fb, second half rows) trains at depth 2,
# END(user fb again — the reference pops through the POPPING block's list,
# apex_multi_imfb.h:173-179; its generator repeats the list on START/END,
# kddcup_combine_ugroup.cpp:196-230).  See
# tests/test_golden_full.py::_stack_depth2 for the exact transform.
cd implicitFeedback
PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python - <<'PYEOF'
from svdfeature_tpu.data.text import load_plus_text
from svdfeature_tpu.data.buffer import write_plus_buffer
from svdfeature_tpu.data.csr import PlusBlock, PlusDataset, TAG_END, TAG_START
pds = load_plus_text("ua.base.group.basicfeature", "ua.base.feedbackfeature")
blocks = []
for blk in pds.blocks():
    n = blk.data.num_row
    if n >= 2:
        h = n // 2
        blocks += [
            PlusBlock(blk.fb_index, blk.fb_value, blk.data.slice_rows(0, h), extend_tag=TAG_START),
            PlusBlock(blk.fb_index[:max(1, len(blk.fb_index)//2)],
                      blk.fb_value[:max(1, len(blk.fb_value)//2)],
                      blk.data.slice_rows(h, n - h)),
            PlusBlock(blk.fb_index, blk.fb_value, blk.data.slice_rows(n, 0), extend_tag=TAG_END),
        ]
    else:
        blocks.append(blk)
write_plus_buffer("buffer.base.stacked.svdpp", PlusDataset.from_blocks(blocks))
PYEOF
rm -f *.model
../../svd_feature implicitFeedback.conf num_round=8 silent=1 extend_type=2 buffer_feature=buffer.base.stacked.svdpp
rm -f $OUT/multi_imfb_stacked.rmse.tsv
../../svd_feature_infer implicitFeedback.conf start=1 end=9 silent=1 extend_type=2 log_eval=$OUT/multi_imfb_stacked.rmse.tsv
cd ..
