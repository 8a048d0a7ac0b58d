from vlsat_tpu.config.config import Config, load_config  # noqa: F401
from vlsat_tpu.config.defaults import DEFAULT_CONFIG  # noqa: F401
