def __getattr__(name):
    from importlib import import_module
    if name == "Model":
        return import_module("bonito_tpu.ctc.model").Model
    if name == "basecall":
        return import_module("bonito_tpu.ctc.basecall").basecall
    raise AttributeError(name)
