from accunet_tpu.train import losses, metrics, schedules
