from .exact import avg_of, dsum  # noqa: F401
from .vectors import cosine_similarity, l2_norm  # noqa: F401
