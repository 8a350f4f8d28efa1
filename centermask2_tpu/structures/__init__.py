from . import boxes
from .instances import Instances
from .image_list import ImageList

__all__ = ["boxes", "Instances", "ImageList"]
