from .casmvsnet import CasMVSNet
from .ucsnet import UCSNet
from .msrednet import MSREDNet
from .adamvs import AdaMVS

MODEL_ZOO = {
    "casmvsnet": CasMVSNet,
    "ucsnet": UCSNet,
    "msrednet": MSREDNet,
    "adamvs": AdaMVS,
}


def build_model(model_type: str, **kwargs):
    """Instantiate a cascade MVS network by config name.

    Mirrors the reference model switch (/root/reference/mvs/mvs_cas/predict.py:71-94).
    """
    try:
        cls = MODEL_ZOO[model_type]
    except KeyError:
        raise ValueError(
            f"unknown model_type {model_type!r}; one of {sorted(MODEL_ZOO)}"
        ) from None
    return cls(**kwargs)


__all__ = ["CasMVSNet", "UCSNet", "MSREDNet", "AdaMVS", "MODEL_ZOO", "build_model"]
