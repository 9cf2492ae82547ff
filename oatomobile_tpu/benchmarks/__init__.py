"""Public API for `oatomobile_tpu.benchmarks`.

Parity: /root/reference/oatomobile/benchmarks/__init__.py.
"""

from oatomobile_tpu.benchmarks.carnovel.benchmark import carnovel
from oatomobile_tpu.benchmarks.corl2017.benchmark import corl2017

__all__ = ["carnovel", "corl2017"]
