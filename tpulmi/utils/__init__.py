from tpulmi.utils.logging import get_logger
from tpulmi.utils.config import IndexConfig, SearchConfig

__all__ = ["get_logger", "IndexConfig", "SearchConfig"]
