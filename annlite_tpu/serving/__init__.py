from .executor import AnnLiteIndexer
from .gateway import Gateway
from .http import Server, make_app, serve

__all__ = ['AnnLiteIndexer', 'Gateway', 'Server', 'make_app', 'serve']
