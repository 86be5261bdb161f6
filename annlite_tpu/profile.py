"""Profiling utilities.

Reference `annlite/profile.py:20-70` wraps cProfile; here we keep that and add
a JAX trace context for on-device profiling (SURVEY.md §5.1: "TPU equivalent:
JAX profiler traces").
"""
import cProfile
import contextlib
import functools
import io
import pstats
import time


def time_profile(func=None, *, output_file: str = None, sort_by: str = 'cumulative', lines: int = 50):
    """cProfile decorator: dumps ``.prof`` + pstats text report."""

    def decorator(f):
        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            prof = cProfile.Profile()
            prof.enable()
            try:
                return f(*args, **kwargs)
            finally:
                prof.disable()
                path = output_file or (f.__name__ + '.prof')
                prof.dump_stats(path)
                s = io.StringIO()
                pstats.Stats(prof, stream=s).sort_stats(sort_by).print_stats(lines)
                with open(path + '.txt', 'w') as fh:
                    fh.write(s.getvalue())

        return wrapper

    if func is not None:
        return decorator(func)
    return decorator


@contextlib.contextmanager
def time_context(name: str, logger=None):
    """Wall-clock timing block (replaces jina TimeContext)."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    msg = f'{name} took {dt:.4f}s'
    if logger is not None:
        logger.info(msg)
    else:
        print(msg)


@contextlib.contextmanager
def device_trace(logdir: str):
    """JAX profiler trace context — view with TensorBoard / xprof."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
