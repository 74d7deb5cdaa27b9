from .factory import build_model, MODEL_FACTORY
