"""Input pipeline: grid-index readers, tile decode, normalization,
samplers, and the prefetching host loader feeding sharded device batches.

Reference counterpart: /root/reference/dataset/Dataset.py (GRD / SSL / SLC
torch Datasets + torch DataLoader workers). TPU-native redesign:

  host threads decode GeoTIFF tiles -> fixed batch struct of numpy arrays
  (post, pre1, pre2, mask, valid, dem?, clz, activation) -> double-buffered
  transfer to batch-sharded device arrays -> normalization & augmentation run
  ON DEVICE inside the jitted step (vectorized over the batch), replacing the
  reference's per-sample CPU albumentations/torchvision work.
"""

from .index import GridIndex, build_records, load_grid_index
from .pipeline import Loader, prepare_loaders
