from accunet_tpu.data.dataset import SegmentationDataset, list_split_ids
from accunet_tpu.data.transforms import RandomGenerator, ValGenerator
from accunet_tpu.data.loader import BatchLoader
