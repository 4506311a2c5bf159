from .base import Tokenizer, Encoded  # noqa: F401
from .hashed import HashedTokenizer  # noqa: F401
from .hf import load_hf_tokenizer, HFTokenizer  # noqa: F401
from .french import tokenize_french_text, FRENCH_STOPWORDS  # noqa: F401
