from .base import BaseIndex
from .buffer import DeviceBuffer
from .flat import FlatIndex
from .pq_scan import PQScanIndex

__all__ = ['BaseIndex', 'DeviceBuffer', 'FlatIndex', 'PQScanIndex']
