from .data_parallel import make_device_mesh, make_dp_epoch_fns, parallelize_trainer
