from .resnet import ARCHS, ResNet, ResNetArch, resnet50, resnext101_32x4d, se_resnext101_32x4d
from .task import ClassificationTask
