from .sparse_feature_array import SparseFeatureArray, RunQueue
from .evaluator import EvaluatorMAP
