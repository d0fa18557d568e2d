from .builder import build_dataset, collate_fn  # noqa: F401
