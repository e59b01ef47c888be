from .api import PRESETS, PTQRecipe, load_recipe, run_recipe

__all__ = ["PTQRecipe", "load_recipe", "run_recipe"]
