from . import dedup, multimodal, similarity
