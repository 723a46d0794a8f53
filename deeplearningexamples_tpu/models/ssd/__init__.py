from .boxes import DefaultBoxes, dboxes300_coco, decode_batch, encode, nms_single
from .model import SSD300, SSDResNetBackbone
from .task import SSDTask, multibox_loss
