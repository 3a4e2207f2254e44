from gradus_tpu.geometry.meshes import MeshAccretionGeometry, jsf_segment_triangle
from gradus_tpu.geometry.discs import (
    AbstractAccretionGeometry,
    ThinDisc,
    WarpedThinDisc,
    DatumPlane,
    ThickDisc,
    ShakuraSunyaev,
    EllipticalDisc,
    PrecessingDisc,
    PolishDoughnut,
    CompositeGeometry,
    datumplane,
)
