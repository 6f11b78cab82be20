"""Image IO + color science (host-side, numpy).

Parity with reference util.py: tiff16 reading (util.py:311-323), image
grid (75-83), center crop (86-94), and the ProPhotoRGB/XYZ color pipeline
(495-590).  Reading uses imageio/PIL instead of tifffile (not available in
this environment)."""

import numpy as np


def read_image(path):
    """Read any 8/16-bit image to float32 RGB in [0, 1]."""
    import imageio.v2 as imageio
    img = np.asarray(imageio.imread(path))
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    elif img.dtype == np.uint16:
        img = img.astype(np.float32) / 65535.0
    else:
        img = img.astype(np.float32)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    return img[..., :3]


def read_tiff16(path):
    """16-bit TIFF -> float32 in [0, 1] (reference util.py:311-323)."""
    import imageio.v2 as imageio
    img = np.asarray(imageio.imread(path))
    if img.dtype == np.uint8:
        depth = 8
    else:
        depth = 16
    return (img.astype(np.float32) * (1.0 / (2 ** depth - 1)))


def linearize_prophoto_rgb(pp_rgb, reverse=False):
    """Undo (or redo) the ProPhotoRGB gamma-1.8 encode
    (reference util.py:495-501)."""
    gamma = 1.8 if not reverse else 1.0 / 1.8
    return np.power(pp_rgb, gamma)


_PROPHOTO_TO_XYZ = np.array(
    [[0.7976749, 0.1351917, 0.0313534],
     [0.2880402, 0.7118741, 0.0000857],
     [0.0000000, 0.0000000, 0.8252100]], dtype=np.float64)

_XYZ_TO_PROPHOTO = np.array(
    [[1.34594337, -0.25560752, -0.05111183],
     [-0.54459882, 1.5081673, 0.02053511],
     [0.0, 0.0, 1.21181275]], dtype=np.float64)

_D65_TO_D50 = np.array(
    [[1.0478112, 0.0228866, -0.0501270],
     [0.0295424, 0.9904844, -0.0170491],
     [-0.0092345, 0.0150436, 0.7521316]], dtype=np.float64)

_D50_TO_D65 = np.array(
    [[0.9555766, -0.0230393, 0.0631636],
     [-0.0282895, 1.0099416, 0.0210077],
     [0.0122982, -0.0204830, 1.3299098]], dtype=np.float64)


def _apply_matrix(img, mat):
    sp = img.shape
    flat = img.reshape(-1, 3) @ mat.T
    return flat.reshape(sp)


def prophoto_rgb_to_xyz(pp_rgb, reverse=False):
    """Linear ProPhotoRGB (D50) <-> XYZ (reference util.py:525-538)."""
    mat = _XYZ_TO_PROPHOTO if reverse else _PROPHOTO_TO_XYZ
    return _apply_matrix(pp_rgb, mat)


def xyz_chromatic_adapt(xyz, src_white='D65', dest_white='D50'):
    """Bradford-style chromatic adaptation (reference util.py:504-520)."""
    if (src_white, dest_white) == ('D65', 'D50'):
        mat = _D65_TO_D50
    elif (src_white, dest_white) == ('D50', 'D65'):
        mat = _D50_TO_D65
    else:
        raise ValueError('unsupported white pair %s -> %s' %
                         (src_white, dest_white))
    return _apply_matrix(xyz, mat)


def _xyz_to_lab(xyz):
    # CIE Lab with D65 reference white
    white = np.array([0.95047, 1.0, 1.08883])
    t = xyz / white
    delta = 6.0 / 29.0
    f = np.where(t > delta ** 3, np.cbrt(t), t / (3 * delta ** 2) + 4.0 / 29)
    L = 116 * f[..., 1] - 16
    a = 500 * (f[..., 0] - f[..., 1])
    b = 200 * (f[..., 1] - f[..., 2])
    return np.stack([L, a, b], axis=-1)


def prophoto_rgb_to_lab(img, linear=False):
    """(Gamma-encoded or linear) ProPhotoRGB -> Lab
    (reference util.py:574-590)."""
    if not linear:
        img = linearize_prophoto_rgb(img)
    xyz = prophoto_rgb_to_xyz(img)
    xyz = xyz_chromatic_adapt(xyz, 'D50', 'D65')
    return _xyz_to_lab(xyz)


def get_image_center(image):
    """Largest centered square crop (reference util.py:86-94)."""
    if image.shape[0] > image.shape[1]:
        start = (image.shape[0] - image.shape[1]) // 2
        image = image[start:start + image.shape[1], :]
    if image.shape[1] > image.shape[0]:
        start = (image.shape[1] - image.shape[0]) // 2
        image = image[:, start:start + image.shape[0]]
    return image


def make_image_grid(images, per_row=8, padding=2):
    """Tile a [N, H, W, C] batch into one image (reference util.py:75-83)."""
    images = np.asarray(images)
    npad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    images = np.pad(images, pad_width=npad, mode='constant',
                    constant_values=1.0)
    assert images.shape[0] % per_row == 0
    num_rows = images.shape[0] // per_row
    rows = [np.hstack(images[i * per_row:(i + 1) * per_row])
            for i in range(num_rows)]
    return np.vstack(rows)


def write_image(path, img):
    """Save a float [0,1] RGB image as 8-bit PNG/JPEG."""
    import imageio.v2 as imageio
    arr = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
    imageio.imwrite(path, arr)
