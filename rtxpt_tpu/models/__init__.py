from .renderer import Renderer, reference_config, realtime_config
