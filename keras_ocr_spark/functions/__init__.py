from .text import crop_expr, decode_expr

__all__ = ["crop_expr", "decode_expr"]
