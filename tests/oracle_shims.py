"""Import shims for running the torch reference as an oracle."""

import sys
import types


def shim_skimage():
    """The reference's u2pl.utils imports skimage (absent in this image) for
    cutmix bank machinery the oracles don't exercise — stub it so the
    reference module imports."""
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        m = types.ModuleType("skimage.measure")
        m.label = lambda *a, **k: None
        m.regionprops = lambda *a, **k: []
        sk.measure = m
        sys.modules["skimage"] = sk
        sys.modules["skimage.measure"] = m
