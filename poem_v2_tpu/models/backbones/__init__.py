from .hourglass import HourglassBisected
from .hrnet import HRNet
from .resnet import ResNet
