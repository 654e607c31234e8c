class EITR:
    def __init__(self, **k): raise NotImplementedError
