from .task import SVDInferTask
