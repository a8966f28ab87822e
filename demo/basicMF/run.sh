#!/bin/bash
set -e
cd "$(dirname "$0")"
ROOT=../..
export PYTHONPATH=$ROOT${PYTHONPATH:+:$PYTHONPATH}
gunzip -kc $ROOT/tests/fixtures/ml100k.base.feature.gz > ua.base.feature
gunzip -kc $ROOT/tests/fixtures/ml100k.test.feature.gz > ua.test.feature
python -m svdfeature_tpu.cli.make_feature_buffer ua.base.feature ua.base.buffer
python -m svdfeature_tpu.cli.make_feature_buffer ua.test.feature ua.test.buffer
python -m svdfeature_tpu.cli.svd_feature basicMF.conf num_round=40
python -m svdfeature_tpu.cli.svd_feature_infer basicMF.conf start=40 end=41
