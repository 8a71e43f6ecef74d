from pcmseg_tpu.utils.logging import get_logger, StepTimer  # noqa: F401
from pcmseg_tpu.utils.artifacts import write_json, read_json  # noqa: F401
