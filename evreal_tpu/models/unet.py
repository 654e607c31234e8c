class E2VIDRecurrent:
    def __init__(self, **k): raise NotImplementedError

class FlowNet:
    def __init__(self, **k): raise NotImplementedError
