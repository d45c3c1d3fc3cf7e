"""Shim for the non-PyPI pypaperutils helper (TU Delft plot colors)."""

import matplotlib.pyplot as plt

_COLORS = {
    "cyaan": "#00A6D6", "donkerblauw": "#0C2340", "blauw": "#0076C2",
    "turkoois": "#00B8C8", "groen": "#009B77", "geel": "#FFB81C",
    "oranje": "#EC6842", "rood": "#E03C31", "roze": "#EF60A3",
    "paars": "#6F1D77",
}


class TUDcolors:
    def get(self, name):
        return _COLORS.get(name, "#000000")

    def colormap(self, name=None):
        return plt.get_cmap("viridis")
