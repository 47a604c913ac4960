from .renderer import Renderer, make_renderer_with_trained_model
