from . import image, metrics
