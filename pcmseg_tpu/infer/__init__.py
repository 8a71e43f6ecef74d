from pcmseg_tpu.infer.sliding_window import sliding_window_predict  # noqa: F401
from pcmseg_tpu.infer.validate import Validator  # noqa: F401
from pcmseg_tpu.infer.predict import Predictor, load_multimodal_images  # noqa: F401
