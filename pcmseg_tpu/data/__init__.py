from pcmseg_tpu.data.volume import Volume  # noqa: F401
from pcmseg_tpu.data.nifti import read_nifti, write_nifti  # noqa: F401
from pcmseg_tpu.data.mha import read_mha, write_mha  # noqa: F401
from pcmseg_tpu.data.io import read_volume, write_volume, read_header  # noqa: F401
