from .server import BatchingService, TextToImageEngine, serve  # noqa: F401
