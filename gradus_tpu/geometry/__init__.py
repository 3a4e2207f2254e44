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
    PolishDoughnutFW,
    polish_doughnut_fw,
    CompositeGeometry,
    datumplane,
)
from gradus_tpu.geometry.polygons import (
    polygon_area,
    polygon_barycenter,
    orientation,
    in_polygon,
)
