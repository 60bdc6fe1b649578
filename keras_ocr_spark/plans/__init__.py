from .pipeline import extract
from .session import build_session

__all__ = ["build_session", "extract"]
