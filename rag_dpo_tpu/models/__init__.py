from .encoder import EncoderConfig, TransformerEncoder  # noqa: F401
from .bge_m3 import BgeM3Config, BgeM3Model, M3Output  # noqa: F401
from .cross_encoder import CrossEncoderModel  # noqa: F401
from .decoder import DecoderConfig, DecoderModel  # noqa: F401
from .generate import SamplingConfig, TextGenerator  # noqa: F401
from .vit import ViTConfig, ViTModel, preprocess_image  # noqa: F401
from .vit import preprocess_image_raw, normalize_uint8_pixels  # noqa: F401
from .llava import (  # noqa: F401
    LlavaConfig, LlavaGenerator, LlavaProjector,
)
