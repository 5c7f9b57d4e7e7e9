from .hrnet import HRNet
from .resnet import ResNet
