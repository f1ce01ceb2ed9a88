def __getattr__(name):
    from importlib import import_module
    if name == "Model":
        return import_module("bonito_tpu.transformer.model").Model
    if name == "basecall":
        # transformer models reuse the CRF basecall pipeline verbatim
        # (reference: bonito/transformer/basecall.py:1)
        return import_module("bonito_tpu.crf.basecall").basecall
    raise AttributeError(name)
