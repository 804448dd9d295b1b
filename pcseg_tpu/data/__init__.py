from pcseg_tpu.data.hdf5 import PointCloudDataset, write_event_files
from pcseg_tpu.data.synthetic import synthetic_events
from pcseg_tpu.data.batching import BucketBatcher, pad_events
from pcseg_tpu.data.class_stats import scan_classes, ClassStats
