from .api import PTQRecipe, load_recipe, run_recipe

__all__ = ["PTQRecipe", "load_recipe", "run_recipe"]
