from .engine import Request, ServingEngine
from .generate import generate_tokens

__all__ = ["Request", "ServingEngine", "generate_tokens"]
