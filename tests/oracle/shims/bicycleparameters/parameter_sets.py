class Meijaard2007ParameterSet:
    """Holds the 27 Meijaard-2007 physical parameters."""

    def __init__(self, parameters, includes_rider=True):
        self.parameters = dict(parameters)
        self.includes_rider = includes_rider
