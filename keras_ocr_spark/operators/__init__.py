from .decode import decode
from .detect import detect, propose_spans_udf
from .reassemble import reassemble

__all__ = ["decode", "detect", "propose_spans_udf", "reassemble"]
