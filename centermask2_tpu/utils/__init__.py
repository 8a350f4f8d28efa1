from .measures import count_params, measure_model, param_bytes, summarize

__all__ = ["count_params", "measure_model", "param_bytes", "summarize"]
