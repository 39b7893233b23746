__version__ = "0.1.0"
__version_tuple__ = tuple(__version__.split("."))
