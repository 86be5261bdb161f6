from .base import BaseCodec
from .pq import DistanceTable, PQCodec
from .projector import ProjectorCodec
from .vq import VQCodec

__all__ = ['BaseCodec', 'PQCodec', 'VQCodec', 'ProjectorCodec', 'DistanceTable']
