#!/bin/bash
set -e
cd "$(dirname "$0")"
ROOT=../..
export PYTHONPATH=$ROOT${PYTHONPATH:+:$PYTHONPATH}
gunzip -kc $ROOT/tests/fixtures/ml100k.base.group.feature.gz > ua.base.group.feature
gunzip -kc $ROOT/tests/fixtures/ml100k.base.feedback.gz > ua.base.feedback
gunzip -kc $ROOT/tests/fixtures/ml100k.test.ug.feature.gz > ua.test.feature
gunzip -kc $ROOT/tests/fixtures/ml100k.test.feedback.gz > ua.test.feedback
python -m svdfeature_tpu.cli.make_ugroup_buffer ua.base.group.feature buffer.base.svdpp -fd ua.base.feedback
python -m svdfeature_tpu.cli.make_ugroup_buffer ua.test.feature buffer.test.svdpp -fd ua.test.feedback
python -m svdfeature_tpu.cli.svd_feature implicitFeedback.conf num_round=40
python -m svdfeature_tpu.cli.svd_feature_infer implicitFeedback.conf start=40 end=41
