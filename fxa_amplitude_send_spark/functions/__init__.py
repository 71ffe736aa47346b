from .hashing import hmac_sha256, hmac_sha256_py, js_string_coerce
from .vectors import cosine_similarity_col, dot_col, l2_norm_col

__all__ = [
    "hmac_sha256",
    "hmac_sha256_py",
    "js_string_coerce",
    "cosine_similarity_col",
    "dot_col",
    "l2_norm_col",
]
