from .paths import Paths, default_paths  # noqa: F401
from .config import FrameworkConfig, load_config  # noqa: F401
from .logging import setup_structured_logging, JSONFormatter  # noqa: F401
from .query_logger import QueryLogger  # noqa: F401
from .alerter import Alerter, AlertConfig  # noqa: F401
from .profiling import PhaseTimer, profile_trace  # noqa: F401
