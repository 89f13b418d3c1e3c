from .w1_similarity import build_user_documents, user_similarity_top_k
from .w2_recommend import build_mention_pairs, dense_id_dictionary, implicit_als_recommend

__all__ = [
    "build_user_documents",
    "user_similarity_top_k",
    "build_mention_pairs",
    "dense_id_dictionary",
    "implicit_als_recommend",
]
