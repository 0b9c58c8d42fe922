"""Example physical systems — the reference demo suite, TPU-native.

One module per example, mirroring ``app/Examples.hs:61-183``:

=============  =====================  ==========================
reference      here                   System (m, n)
=============  =====================  ==========================
``pendulum``   :mod:`pendulum`        (2, 1)
``doublePendulum``  :mod:`double_pendulum`  (4, 2)
``room``       :mod:`room`            (2, 2)
``twoBody``    :mod:`two_body`        (4, 2)
``spring``     :mod:`spring`          (3, 3)
``bezier``     :mod:`bezier`          (2, 1)
(none)         :mod:`chain`           (2N, N) — BASELINE stress config
=============  =====================  ==========================
"""

from hamilton_tpu.models.base import Example, logistic
from hamilton_tpu.models.pendulum import pendulum
from hamilton_tpu.models.double_pendulum import double_pendulum
from hamilton_tpu.models.room import room
from hamilton_tpu.models.two_body import two_body
from hamilton_tpu.models.spring import spring
from hamilton_tpu.models.bezier import bezier, bezier_curve
from hamilton_tpu.models.chain import chain
from hamilton_tpu.models.ellipse import ellipse
from hamilton_tpu.models.spherical import spherical_pendulum

#: Registry keyed by the reference CLI subcommand names (app/Examples.hs:201-227),
#: plus the TPU-native ``chain`` stress model.
REGISTRY = {
    "pend": pendulum,
    "doublepend": double_pendulum,
    "room": room,
    "twobody": two_body,
    "spring": spring,
    "bezier": bezier,
    "chain": chain,
    "ellipse": ellipse,
    "spherical": spherical_pendulum,
}


def get_example(name: str, **params) -> Example:
    """Construct a registered example by CLI name with keyword parameters."""
    try:
        factory = REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown example {name!r}; choose from {sorted(REGISTRY)}")
    return factory(**params)


__all__ = [
    "Example",
    "logistic",
    "pendulum",
    "double_pendulum",
    "room",
    "two_body",
    "spring",
    "bezier",
    "bezier_curve",
    "chain",
    "ellipse",
    "spherical_pendulum",
    "REGISTRY",
    "get_example",
]
