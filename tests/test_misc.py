"""Small-component coverage: enums, helper, profile (reference
`tests/test_enums.py` tier)."""
import numpy as np
import pytest

from annlite_tpu.enums import ExpandMode, Metric, parse_metric
from annlite_tpu.helper import setup_logging, str2dtype
from annlite_tpu.profile import time_context, time_profile


def test_metric_from_string():
    assert Metric.from_string('cosine') == Metric.COSINE
    assert Metric.from_string('EUCLIDEAN') == Metric.EUCLIDEAN
    assert Metric.from_string('inner_product') == Metric.INNER_PRODUCT
    with pytest.raises(ValueError):
        Metric.from_string('manhattan')


def test_parse_metric():
    assert parse_metric('cosine') == Metric.COSINE
    assert parse_metric(Metric.EUCLIDEAN) == Metric.EUCLIDEAN
    with pytest.raises(TypeError):
        parse_metric(3.14)


def test_expand_mode():
    assert ExpandMode.from_string('step') == ExpandMode.STEP
    assert ExpandMode.DOUBLE.value == 2


def test_str2dtype():
    assert str2dtype('float32') == np.float32
    assert str2dtype('uint8') == np.uint8
    with pytest.raises(TypeError):
        str2dtype(None)


def test_setup_logging_idempotent():
    a = setup_logging(False, name='t1')
    b = setup_logging(True, name='t1')
    assert a is b
    assert len(a.handlers) == 1


def test_time_profile_writes_report(tmp_path):
    out = tmp_path / 'f.prof'

    @time_profile(output_file=str(out))
    def work():
        return sum(range(1000))

    work()
    assert out.exists()
    assert (tmp_path / 'f.prof.txt').exists()


def test_time_context(capsys):
    with time_context('block'):
        pass
    assert 'block took' in capsys.readouterr().out
