from .registry import batch_function, get_batch_function, list_batch_functions  # noqa: F401
