from diffpir_tpu.train.loop import TrainConfig, TrainState, Trainer, dryrun_train_step

__all__ = ["TrainConfig", "TrainState", "Trainer", "dryrun_train_step"]
