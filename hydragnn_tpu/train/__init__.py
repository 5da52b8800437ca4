from hydragnn_tpu.train.trainer import train_validate_test, TrainState
