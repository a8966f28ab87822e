from .embed import forward_scores, train_step, HyperParams, TrainConsts
