from .base import BaseIndex
from .buffer import DeviceBuffer
from .flat import FlatIndex
from .graph import GraphIndex
from .pq_scan import PQScanIndex

__all__ = ['BaseIndex', 'DeviceBuffer', 'FlatIndex', 'GraphIndex', 'PQScanIndex']
