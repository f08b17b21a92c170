from .io import io0, load_solution, save_solution
from .plot import plot, plot_parabolic

__all__ = ["io0", "save_solution", "load_solution", "plot", "plot_parabolic"]
