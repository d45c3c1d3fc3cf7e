class Sequence:
    """Stub of trajdatamanager.datamanager.Sequence (only needed so the
    reference calibration module imports; golden generation does not use
    real track data)."""

    def __init__(self, *a, **k):
        raise NotImplementedError("trajdatamanager shim is import-only")
