class SpadeE2vid:
    def __init__(self, **k): raise NotImplementedError
