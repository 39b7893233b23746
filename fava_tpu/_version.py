__version__ = "0.4.0"
__version_tuple__ = tuple(__version__.split("."))
