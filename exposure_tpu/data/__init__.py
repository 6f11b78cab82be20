from exposure_tpu.data.provider import DataProvider
from exposure_tpu.data.fivek import FiveKDataProvider
from exposure_tpu.data.artist import ArtistDataProvider
from exposure_tpu.data.folder import FolderDataProvider
from exposure_tpu.data.synthetic import SyntheticDataProvider
from exposure_tpu.data.folds import read_set
from exposure_tpu.data.device_sampler import DevicePack, sample_batch
