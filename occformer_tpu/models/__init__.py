from . import layers  # noqa: F401
from .resnet import ResNet  # noqa: F401
from .second_fpn import SECONDFPN  # noqa: F401
from .depthnet import DepthNet  # noqa: F401
from .lss import ViewTransformerLiftSplatShootVoxel  # noqa: F401
from .swin import SwinBlock  # noqa: F401
from .aspp import ASPP2D, BottleNeckASPP  # noqa: F401
from .occnet import DualpathTransformerBlock, OccupancyEncoder  # noqa: F401
from .pos_embed import SinePositionalEncoding3D  # noqa: F401
from .pixel_decoder import MSDeformAttnPixelDecoder3D  # noqa: F401
from .mask2former_head import (  # noqa: F401
    Mask2FormerOccHead,
    Mask2FormerNuscOccHead,
    Mask2FormerNuscPanopticOccHead,
)
from .efficientnet import CustomEfficientNet  # noqa: F401
from .bevstereo import DepthNetStereo, ViewTransformerLSSBEVStereo  # noqa: F401
from .detector import OccupancyFormer  # noqa: F401
