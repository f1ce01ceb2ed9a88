def __getattr__(name):
    if name == "Model":
        from bonito_tpu.ctc.model import Model
        return Model
    if name == "basecall":
        from bonito_tpu.ctc import basecall
        return basecall.basecall
    raise AttributeError(name)
