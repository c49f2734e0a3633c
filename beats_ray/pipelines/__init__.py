from .flagship import FLAGSHIP_CONFIG, build_flagship, flagship_config  # noqa: F401
