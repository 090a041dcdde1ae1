from .server import (  # noqa: F401
    BatchingService,
    SpaceTimeEngine,
    TextToImageEngine,
    serve,
)
