#!/bin/bash
set -e
cd "$(dirname "$0")"
ROOT=../..
export PYTHONPATH=$ROOT${PYTHONPATH:+:$PYTHONPATH}
gunzip -kc $ROOT/tests/fixtures/ml100k.rank.base.feature.gz > ua.base.rank.feature
gunzip -kc $ROOT/tests/fixtures/ml100k.rank.base.feedback.gz > ua.base.rank.feedback
gunzip -kc $ROOT/tests/fixtures/ml100k.rank.test.feature.gz > ua.test.rank.feature
gunzip -kc $ROOT/tests/fixtures/ml100k.rank.test.feedback.gz > ua.test.rank.feedback
python -m svdfeature_tpu.cli.make_ugroup_buffer ua.base.rank.feature buffer.base.svdpp -fd ua.base.rank.feedback -scale_score 5
python -m svdfeature_tpu.cli.make_ugroup_buffer ua.test.rank.feature buffer.test.svdpp -fd ua.test.rank.feedback -scale_score 1 -max_block 400
python -m svdfeature_tpu.cli.svd_feature pairwiseRank.conf num_round=40
python -m svdfeature_tpu.cli.svd_feature_infer pairwiseRank.conf pred=40
python eval.py pred.txt
