from .load import load_preprocessed_data
from .sampler import RayData, create_ray_data, gather_batch, num_train_batches
from .datasets import MeshViewsDataset, MeshroomRadialK3Dataset, load_meshroom_metadata
from .preprocess import MeshViewPreProcessor
