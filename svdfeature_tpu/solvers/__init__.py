from .registry import create_svd_trainer, create_svd_ranker
