"""Codec base class.

Parity with reference `annlite/core/codec/base.py:9-38` (require_train,
is_trained, _check_trained, dump/load), but serialization uses ``np.savez``
(arrays) + JSON (params) instead of pickle — no arbitrary code execution on
load, and the arrays round-trip bit-exact.
"""
import abc
import json
from pathlib import Path
from typing import Dict, Union

import numpy as np


class BaseCodec(abc.ABC):
    def __init__(self, require_train: bool = True):
        self.require_train = require_train
        self._is_trained = False

    @property
    def is_trained(self) -> bool:
        if not self.require_train:
            return True
        return self._is_trained

    def _check_trained(self):
        if not self.is_trained:
            raise RuntimeError(
                f'{self.__class__.__name__} has not been trained; call `fit` first'
            )

    @abc.abstractmethod
    def fit(self, x: np.ndarray):
        ...

    @abc.abstractmethod
    def encode(self, x: np.ndarray):
        ...

    @abc.abstractmethod
    def decode(self, x: np.ndarray):
        ...

    # ----- serialization -----

    def _state(self) -> Dict:
        """Return {'params': json-able dict, 'arrays': {name: np.ndarray}}."""
        raise NotImplementedError

    def _restore(self, params: Dict, arrays: Dict[str, np.ndarray]):
        raise NotImplementedError

    def dump(self, target_path: Union[str, Path]):
        target_path = Path(target_path)
        state = self._state()
        payload = {f'arr__{k}': v for k, v in state['arrays'].items()}
        payload['params_json'] = np.frombuffer(
            json.dumps(
                {'cls': self.__class__.__name__, **state['params']}
            ).encode('utf-8'),
            dtype=np.uint8,
        )
        target_path.parent.mkdir(parents=True, exist_ok=True)
        with open(target_path, 'wb') as f:
            np.savez(f, **payload)

    @classmethod
    def load(cls, from_path: Union[str, Path]) -> 'BaseCodec':
        with np.load(Path(from_path), allow_pickle=False) as z:
            params = json.loads(bytes(z['params_json']).decode('utf-8'))
            if params.pop('cls') != cls.__name__:
                raise ValueError(f'{from_path} does not hold a {cls.__name__}')
            arrays = {
                k[len('arr__'):]: z[k] for k in z.files if k.startswith('arr__')
            }
        obj = cls.__new__(cls)
        obj._restore(params, arrays)
        return obj
