from pcmseg_tpu.core.config import Config, get_config, PRESETS  # noqa: F401
