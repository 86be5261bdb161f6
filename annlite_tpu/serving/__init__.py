from .executor import AnnLiteIndexer
from .gateway import Gateway
from .grpc_server import GrpcClient, GrpcServer
from .http import Server, make_app, serve

__all__ = [
    'AnnLiteIndexer', 'Gateway', 'GrpcClient', 'GrpcServer', 'Server',
    'make_app', 'serve',
]
