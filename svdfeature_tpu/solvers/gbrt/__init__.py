from .trainer import create_gbrt_trainer, GBRTTrainer, RegGBRTTrainer, APLambdaGBRTTrainer
