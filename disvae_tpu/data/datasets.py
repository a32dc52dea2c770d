"""Host-side data pipeline feeding the TPU training loop.

Counterpart of the reference's utils/datasets.py:21-424, redesigned for an
XLA-fed input path instead of torch DataLoader workers:

- Every dataset is materialized once into a flat uint8 ``.npy`` cache and then
  **memory-mapped** (`np.load(mmap_mode="r")`). Batch assembly is a fancy-index
  gather + a single float32 scale — no per-item Python objects, no PIL in the
  hot loop, no worker processes.
- Arrays are **NHWC** (TPU conv layout); the reference is NCHW. `get_img_size`
  still reports (C, H, W) for CLI/spec compatibility (reference
  datasets.py:39-41).
- Epoch shuffling is a host-side `np.random.Generator` permutation keyed by
  (seed, epoch), so runs are reproducible and each epoch reshuffles — the
  analogue of torch DataLoader(shuffle=True) + the global seed at
  helpers.py:23-30.

Registry and per-dataset metadata (img_size, background_color, urls, factor
lattice for dsprites) mirror reference datasets.py:21-36,145-179.
"""

import abc
import glob
import gzip
import hashlib
import logging
import os
import struct
import subprocess
import zipfile

import numpy as np

DIR = os.path.abspath(os.path.dirname(__file__))
DATA_ROOT = os.environ.get("DISVAE_DATA_ROOT",
                           os.path.join(os.getcwd(), "data"))

COLOUR_BLACK = 0
COLOUR_WHITE = 1

DATASETS_DICT = {}  # name -> class, filled by @_register
DATASETS = []


def _register(name):
    def wrap(cls):
        DATASETS_DICT[name] = cls
        DATASETS.append(name)
        cls.name = name
        return cls
    return wrap


def get_dataset(dataset):
    """Return the dataset class for `dataset` (reference datasets.py:29-36)."""
    dataset = dataset.lower()
    try:
        return DATASETS_DICT[dataset]
    except KeyError:
        raise ValueError("Unknown dataset: {}".format(dataset))


def get_img_size(dataset):
    """(C, H, W) of `dataset` (reference datasets.py:39-41)."""
    return get_dataset(dataset).img_size


def get_background(dataset):
    """Background color used for viz padding (reference datasets.py:44-46)."""
    return get_dataset(dataset).background_color


def get_dataloaders(dataset, root=None, shuffle=True, batch_size=128,
                    logger=logging.getLogger(__name__), seed=None, **kwargs):
    """Build a DataLoader for a registered dataset
    (reference datasets.py:49-71; pin_memory/num_workers have no TPU analogue
    — batches are device_put by the jitted step)."""
    Dataset = get_dataset(dataset)
    ds = Dataset(logger=logger) if root is None else Dataset(root=root,
                                                             logger=logger)
    return DataLoader(ds, batch_size=batch_size, shuffle=shuffle, seed=seed,
                      **kwargs)


class DataLoader:
    """Minimal numpy batch iterator.

    Yields `(images, labels)` with images float32 NHWC in [0, 1]. Shuffling
    draws a fresh permutation per epoch from a (seed, epoch)-keyed PRNG;
    `drop_last=False` keeps the final partial batch, matching torch defaults
    that the reference relies on (partial batches enter MSS weights).
    """

    def __init__(self, dataset, batch_size=128, shuffle=False, seed=None,
                 drop_last=False, raw=False, host_slice=None,
                 pad_global_to=None):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.raw = raw  # yield wire-format uint8 (see get_batch_raw)
        # Multi-host feeding: host_slice=(process_index, process_count)
        # makes this loader yield only this host's rows of every global
        # batch (contiguous shares, so the union over all hosts is exactly
        # the global permutation). The permutation itself is (seed,
        # epoch)-keyed, hence identical on every host.
        #
        # With pad_global_to=M (the mesh's data-axis size; required for
        # SPMD feeding), every global batch's index list is first padded up
        # to the next multiple of M by repeating its last index, then split
        # into process_count EQUAL contiguous shares. This keeps all hosts
        # yielding the same number of identically-shaped batches (no
        # collective desync) and puts every pad row at the END of the
        # assembled global batch, which is what the mask-aware padded step
        # assumes (ops/losses.py masks the first true-size rows); the true
        # global size comes from `global_batch_sizes()`. Without
        # pad_global_to, shares are np.array_split (possibly uneven/empty)
        # — exact-union semantics for host-local consumers only.
        self.host_slice = host_slice
        self.pad_global_to = pad_global_to
        if host_slice is not None and pad_global_to is not None:
            if pad_global_to % host_slice[1]:
                raise ValueError(
                    "pad_global_to={} must be divisible by process_count={}"
                    .format(pad_global_to, host_slice[1]))
        if host_slice is not None and host_slice[1] > 1 and shuffle \
                and seed is None:
            # every host draws the permutation independently; without a
            # shared seed the slices come from DIFFERENT permutations and
            # the assembled global batches silently duplicate/drop samples
            raise ValueError(
                "host_slice feeding with shuffle=True requires a seed: the "
                "(seed, epoch)-keyed permutation must be identical on every "
                "host.")
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def global_batch_sizes(self):
        """TRUE global size of each batch this epoch, independent of any
        host_slice/padding — the mask-aware padded step needs the global
        (not host-local) valid-row count."""
        n = len(self.dataset)
        sizes = [self.batch_size] * (n // self.batch_size)
        if not self.drop_last and n % self.batch_size:
            sizes.append(n % self.batch_size)
        return sizes

    def epoch_order(self):
        """This epoch's index order; advances the epoch counter. Shared by
        the streaming iterator and the HBM-resident path so both feed
        identical batch sequences."""
        n = len(self.dataset)
        if not self.shuffle:
            return np.arange(n)
        if self.seed is None:
            rng = np.random.default_rng()
        else:
            rng = np.random.default_rng((int(self.seed), self._epoch))
        self._epoch += 1
        return rng.permutation(n)

    def __iter__(self):
        n = len(self.dataset)
        order = self.epoch_order()
        end = (n - n % self.batch_size) if self.drop_last else n
        for i in range(0, end, self.batch_size):
            idcs = order[i:i + self.batch_size]
            if self.drop_last and len(idcs) < self.batch_size:
                break
            if self.host_slice is not None:
                pi, pn = self.host_slice
                if self.pad_global_to is not None:
                    m = self.pad_global_to
                    padded_n = -(-len(idcs) // m) * m
                    if padded_n > len(idcs):
                        idcs = np.concatenate(
                            [idcs, np.repeat(idcs[-1:],
                                             padded_n - len(idcs))])
                    share = padded_n // pn
                    idcs = idcs[pi * share:(pi + 1) * share]
                else:
                    idcs = np.array_split(idcs, pn)[pi]
                    if len(idcs) == 0:
                        continue
            if self.raw:
                yield self.dataset.get_batch_raw(idcs)
            else:
                yield self.dataset.get_batch(idcs)


class BaseDataset(abc.ABC):
    """A dataset is a uint8 NHWC array (usually a disk memmap) + labels.

    Subclasses set class attrs `img_size` (C, H, W), `background_color`, and
    optionally the dsprites factor lattice (`lat_sizes`, `lat_names`,
    `lat_values`). `_scale` converts stored uint8 to [0,1] floats.
    """

    img_size = None
    background_color = COLOUR_BLACK
    lat_sizes = None
    lat_names = None
    _scale = 1.0 / 255.0

    def __init__(self, imgs, labels=None):
        self.imgs = imgs
        if labels is None:
            labels = np.zeros((len(imgs),), np.int32)
        self.labels = labels

    def __len__(self):
        return len(self.imgs)

    def __getitem__(self, idx):
        img = np.asarray(self.imgs[idx], np.float32) * self._scale
        return img, self.labels[idx]

    def get_batch(self, idcs):
        """Gather a batch: float32 (B, H, W, C) in [0,1] plus labels.

        Uses the native fused gather+convert (disvae_tpu/native) when the
        backing store is a C-contiguous uint8 array/memmap; numpy otherwise."""
        idcs = np.asarray(idcs)
        imgs = None
        if self.imgs.dtype == np.uint8 and self.imgs.flags["C_CONTIGUOUS"]:
            from disvae_tpu import native
            imgs = native.gather_u8_to_f32(self.imgs, idcs, self._scale)
        if imgs is None:
            imgs = np.asarray(self.imgs[idcs], np.float32) * self._scale
        return imgs, np.asarray(self.labels[idcs])

    # binary datasets (values in {0, 1}) additionally support the bitpacked
    # wire format below — 32x less host->device traffic than f32
    is_binary = False

    def get_batch_raw(self, idcs):
        """Gather a batch as WIRE-FORMAT uint8 (intensity = value / 255) plus
        labels. 4x less host->device traffic than the float batch; the
        compiled train step converts on device (train/steps.py). Storage
        conventions are renormalized here (dsprites stores {0,1})."""
        idcs = np.asarray(idcs)
        if self.is_binary:
            return self.get_batch_bits(idcs)
        mul = int(round(255 * self._scale))
        if self.imgs.dtype == np.uint8 and self.imgs.flags["C_CONTIGUOUS"]:
            from disvae_tpu import native
            out = native.gather_u8_scaled(self.imgs, idcs, mul)
            if out is not None:
                return out, np.asarray(self.labels[idcs])
        out = (np.asarray(self.imgs[idcs]) * mul).astype(np.uint8)
        return out, np.asarray(self.labels[idcs])

    def get_batch_bits(self, idcs):
        """Binary-dataset wire format: 1 bit per pixel, (B, n_pixels/8)
        uint8 (np.packbits big-endian bit order). The compiled step unpacks
        on device (train/steps.py _decompress_batch)."""
        idcs = np.asarray(idcs)
        rows = None
        if self.imgs.dtype == np.uint8 and self.imgs.flags["C_CONTIGUOUS"]:
            from disvae_tpu import native
            rows = native.gather_u8_scaled(self.imgs, idcs, 1)
        if rows is None:
            rows = np.asarray(self.imgs[idcs], np.uint8)
        packed = np.packbits(rows.reshape(len(idcs), -1), axis=1)
        return packed, np.asarray(self.labels[idcs])


class ArrayDataset(BaseDataset):
    """In-memory dataset over a uint8 (N, H, W, C) array, with optional
    factor metadata so synthetic lattices can exercise the MIG/AAM path."""

    def __init__(self, imgs, labels=None, lat_sizes=None, lat_names=None):
        super().__init__(np.asarray(imgs, np.uint8), labels)
        if lat_sizes is not None:
            self.lat_sizes = np.asarray(lat_sizes)
        if lat_names is not None:
            self.lat_names = tuple(lat_names)
        h, w, c = self.imgs.shape[1:]
        self.img_size = (c, h, w)


# --------------------------------------------------------------------------
# download / cache helpers
# --------------------------------------------------------------------------

def _download(url, path, logger):
    """Fetch `url` to `path` via curl (reference datasets.py:188-192). In a
    zero-egress environment this fails with a clear message telling the user
    where to place the file."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    logger.info("Downloading {} ...".format(url))
    try:
        subprocess.check_call(["curl", "-L", "--fail", "--silent",
                               "--show-error", url, "--output", path])
    except (OSError, subprocess.CalledProcessError) as e:
        if os.path.exists(path):
            os.remove(path)
        raise RuntimeError(
            "Could not download {} (offline environment?). Place the file "
            "manually at {} and rerun. ({})".format(url, path, e))


def _require_file(path, url, logger):
    if not os.path.exists(path):
        _download(url, path, logger)
    return path


def _md5(path):
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _load_idx(path):
    """Parse an (optionally gzipped) IDX file (MNIST format)."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic = struct.unpack(">I", f.read(4))[0]
        ndim = magic & 0xFF
        dims = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        data = np.frombuffer(f.read(), np.uint8)
    return data.reshape(dims)


def _resize_batch(imgs, size, resample="bilinear", grayscale=False):
    """Resize a uint8 (N, H, W[, C]) stack with PIL (bilinear, matching
    torchvision.transforms.Resize defaults used at reference
    datasets.py:368-371)."""
    from PIL import Image
    rs = Image.BILINEAR if resample == "bilinear" else Image.LANCZOS
    out = []
    for img in imgs:
        im = Image.fromarray(img)
        if grayscale:
            im = im.convert("L")
        im = im.resize((size, size), rs)
        out.append(np.asarray(im, np.uint8))
    out = np.stack(out)
    if out.ndim == 3:
        out = out[..., None]
    return out


def _memmap_cache(cache_path, builder, logger):
    """Build `cache_path` (uint8 .npy) once via `builder()` then memory-map
    it. The memmap is the device-feed source: batch gathers touch only the
    pages they need, so the 3 GB dsprites / 2.3 GB celeba stacks never have
    to fit in host RAM."""
    if not os.path.exists(cache_path):
        arr = builder()
        os.makedirs(os.path.dirname(cache_path), exist_ok=True)
        tmp = cache_path + ".tmp.npy"
        np.save(tmp, np.ascontiguousarray(arr, dtype=np.uint8))
        os.replace(tmp, cache_path)
        if logger:
            logger.info("Cached {} ({} images)".format(cache_path, len(arr)))
    return np.load(cache_path, mmap_mode="r")


# --------------------------------------------------------------------------
# real datasets
# --------------------------------------------------------------------------

@_register("mnist")
class MNIST(BaseDataset):
    """MNIST train split, resized 28->32 (reference datasets.py:355-368)."""

    img_size = (1, 32, 32)
    background_color = COLOUR_BLACK
    urls = {
        "images": "https://storage.googleapis.com/cvdf-datasets/mnist/"
                  "train-images-idx3-ubyte.gz",
        "labels": "https://storage.googleapis.com/cvdf-datasets/mnist/"
                  "train-labels-idx1-ubyte.gz",
    }
    files = {"images": "train-images-idx3-ubyte.gz",
             "labels": "train-labels-idx1-ubyte.gz"}

    def __init__(self, root=None, logger=logging.getLogger(__name__)):
        root = root or os.path.join(DATA_ROOT, type(self).name)
        cache = os.path.join(root, "train32.npz")

        if not os.path.exists(cache):
            raw = _require_file(os.path.join(root, self.files["images"]),
                                self.urls["images"], logger)
            imgs = _resize_batch(_load_idx(raw), 32)
            labels_path = _require_file(
                os.path.join(root, self.files["labels"]),
                self.urls["labels"], logger)
            labels = _load_idx(labels_path).astype(np.int32)
            os.makedirs(root, exist_ok=True)
            # atomic like every other cache here: a build killed mid-write
            # must not leave a truncated npz the next run trusts
            tmp = cache + ".tmp.npz"
            np.savez_compressed(tmp, imgs=imgs, labels=labels)
            os.replace(tmp, cache)
            if logger:
                logger.info("Cached {} ({} images)".format(cache, len(imgs)))

        with np.load(cache) as z:
            imgs = np.asarray(z["imgs"], np.uint8)
            labels = np.asarray(z["labels"], np.int32)
        super().__init__(imgs, labels)


@_register("fashion")
class FashionMNIST(MNIST):
    """FashionMNIST train split (reference datasets.py:371-382)."""

    urls = {
        "images": "http://fashion-mnist.s3-website.eu-central-1.amazonaws.com"
                  "/train-images-idx3-ubyte.gz",
        "labels": "http://fashion-mnist.s3-website.eu-central-1.amazonaws.com"
                  "/train-labels-idx1-ubyte.gz",
    }


@_register("dsprites")
class DSprites(BaseDataset):
    """dSprites: 737,280 binary 64x64 sprites on a (3,6,40,32,32) factor
    lattice (reference datasets.py:117-213). Stored values are {0,1} so
    `_scale` is 1. Labels are the 6-vector `latents_values` the metrics
    pipeline slices by factor."""

    img_size = (1, 64, 64)
    background_color = COLOUR_BLACK
    lat_sizes = np.array([3, 6, 40, 32, 32])
    lat_names = ("shape", "scale", "orientation", "posX", "posY")
    lat_values = {
        "posX": np.linspace(0, 1, 32),
        "posY": np.linspace(0, 1, 32),
        "scale": np.linspace(0.5, 1, 6),
        "orientation": np.linspace(0, 2 * np.pi, 40),
        "shape": np.array([1., 2., 3.]),
        "color": np.array([1.]),
    }
    urls = {"train": "https://github.com/deepmind/dsprites-dataset/blob/"
                     "master/dsprites_ndarray_co1sh3sc6or40x32y32_64x64.npz"
                     "?raw=true"}
    files = {"train": "dsprite_train.npz"}
    _scale = 1.0
    is_binary = True

    def __init__(self, root=None, logger=logging.getLogger(__name__)):
        root = root or os.path.join(DATA_ROOT, type(self).name)
        npz_path = os.path.join(root, self.files["train"])
        imgs_cache = os.path.join(root, "dsprites_imgs.npy")
        lat_cache = os.path.join(root, "dsprites_latents.npy")

        if not (os.path.exists(imgs_cache) and os.path.exists(lat_cache)):
            _require_file(npz_path, self.urls["train"], logger)
            with np.load(npz_path, allow_pickle=True) as z:
                imgs = z["imgs"][..., None]  # (N, 64, 64, 1) uint8 {0,1}
                lat = z["latents_values"].astype(np.float32)
            os.makedirs(root, exist_ok=True)
            np.save(lat_cache, lat)
            tmp = imgs_cache + ".tmp.npy"
            np.save(tmp, np.ascontiguousarray(imgs, np.uint8))
            os.replace(tmp, imgs_cache)

        imgs = np.load(imgs_cache, mmap_mode="r")
        labels = np.load(lat_cache)
        super().__init__(imgs, labels)


@_register("celeba")
class CelebA(BaseDataset):
    """CelebA aligned faces, offline-resized to 64x64 and packed into one
    memmapped uint8 stack (reference datasets.py:216-291,386-424 does the
    resize per-run with skimage; here it is a one-time cache build)."""

    img_size = (3, 64, 64)
    background_color = COLOUR_WHITE
    urls = {"train": "https://s3-us-west-1.amazonaws.com/udacity-dlnfd/"
                     "datasets/celeba.zip"}
    files = {"train": "img_align_celeba.zip"}
    zip_md5 = "00d2c5bc6d35e252742224ab0c1e8fcb"

    def __init__(self, root=None, logger=logging.getLogger(__name__)):
        root = root or os.path.join(DATA_ROOT, type(self).name)
        cache = os.path.join(root, "celeba_64.npy")

        def build():
            img_dir = os.path.join(root, "img_align_celeba")
            if not os.path.isdir(img_dir):
                zip_path = os.path.join(root, self.files["train"])
                _require_file(zip_path, self.urls["train"], logger)
                got = _md5(zip_path)
                if got != self.zip_md5:
                    raise RuntimeError("{} md5 mismatch: {} != {}".format(
                        zip_path, got, self.zip_md5))
                with zipfile.ZipFile(zip_path) as zf:
                    zf.extractall(root)
            from PIL import Image
            paths = sorted(glob.glob(os.path.join(img_dir, "*.jpg")))
            if not paths:
                raise RuntimeError("No images under {}".format(img_dir))
            out = np.empty((len(paths), 64, 64, 3), np.uint8)
            for i, p in enumerate(paths):
                # match reference preprocess: direct resize to 64x64
                # (datasets.py:386-424), anti-aliased
                out[i] = np.asarray(
                    Image.open(p).convert("RGB").resize((64, 64),
                                                        Image.LANCZOS))
            return out

        imgs = _memmap_cache(cache, build, logger)
        super().__init__(imgs)


@_register("chairs")
class Chairs(BaseDataset):
    """3D chairs renders: grayscale 64x64 (reference datasets.py:294-352).
    The reference's center-crop is a silent no-op (datasets.py:416-422,
    `img.crop` result discarded) so images are plain resizes — we reproduce
    that, documented rather than copied."""

    img_size = (1, 64, 64)
    background_color = COLOUR_WHITE
    urls = {"train": "https://www.di.ens.fr/willow/research/seeing3Dchairs/"
                     "data/rendered_chairs.tar"}
    files = {"train": "chairs.tar"}

    def __init__(self, root=None, logger=logging.getLogger(__name__)):
        root = root or os.path.join(DATA_ROOT, type(self).name)
        cache = os.path.join(root, "chairs_64.npy")

        def build():
            img_root = os.path.join(root, "rendered_chairs")
            if not os.path.isdir(img_root):
                tar_path = os.path.join(root, self.files["train"])
                _require_file(tar_path, self.urls["train"], logger)
                import tarfile
                with tarfile.open(tar_path) as tf:
                    tf.extractall(root)
            paths = sorted(glob.glob(os.path.join(img_root, "**", "*.png"),
                                     recursive=True))
            if not paths:
                raise RuntimeError("No images under {}".format(img_root))
            from PIL import Image
            out = np.empty((len(paths), 64, 64, 1), np.uint8)
            for i, p in enumerate(paths):
                im = Image.open(p).convert("L").resize((64, 64),
                                                       Image.LANCZOS)
                out[i, ..., 0] = np.asarray(im)
            return out

        imgs = _memmap_cache(cache, build, logger)
        super().__init__(imgs)
