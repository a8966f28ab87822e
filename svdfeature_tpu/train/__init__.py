from .loop import SVDTrainTask
