from exposure_tpu.tools.user_study.filters import all_filters
from exposure_tpu.tools.user_study.session import RetouchSession
