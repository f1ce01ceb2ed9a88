from bonito_tpu.crf.seqdist import CTC_CRF, Log, Max  # noqa

# Model/basecall are imported lazily by load_symbol to avoid circular imports
# at package import time.


def __getattr__(name):
    if name in ("Model", "SeqdistModel"):
        from bonito_tpu.crf import model
        return getattr(model, name)
    if name == "basecall":
        from bonito_tpu.crf import basecall
        return basecall.basecall
    raise AttributeError(name)
