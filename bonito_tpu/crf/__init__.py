from bonito_tpu.crf.seqdist import CTC_CRF, Log, Max  # noqa

# Model/basecall are imported lazily by load_symbol to avoid circular imports
# at package import time.


def __getattr__(name):
    from importlib import import_module
    if name in ("Model", "SeqdistModel"):
        return getattr(import_module("bonito_tpu.crf.model"), name)
    if name == "basecall":
        return import_module("bonito_tpu.crf.basecall").basecall
    raise AttributeError(name)
