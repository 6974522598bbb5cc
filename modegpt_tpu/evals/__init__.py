from modegpt_tpu.evals.perplexity import compute_perplexity

__all__ = ["compute_perplexity"]
