from .evaluate import lm_cross_entropy, perplexity, synthetic_token_batches

__all__ = ["lm_cross_entropy", "perplexity", "synthetic_token_batches"]
