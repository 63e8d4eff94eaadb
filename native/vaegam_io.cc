// vaegam_io — native NIfTI-1 decode path for the input pipeline.
//
// The reference's input pipeline is pure-Python nibabel (DataClass_GP.py:48);
// this library provides the framework's native equivalent: zlib inflation,
// NIfTI-1 header parse, dtype conversion to float32, and a thread-pooled
// multi-file decode for parallel subject ingestion on many-core hosts.
// Python binds via ctypes (vaegam_tpu/utils/nifti_native.py) and falls back
// to the pure-numpy codec when the library is absent.
//
// Build: make -C native   (g++ -O3 -shared -fPIC vaegam_io.cc -lz)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>
#include <mutex>

#include <zlib.h>

namespace {

// ---- raw file / gzip loading ------------------------------------------------

bool read_file(const char* path, std::vector<uint8_t>& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out.resize(static_cast<size_t>(n));
  size_t got = std::fread(out.data(), 1, out.size(), f);
  std::fclose(f);
  return got == out.size();
}

// inflate a gzip stream (unknown output size; grows geometrically)
bool gunzip(const std::vector<uint8_t>& in, std::vector<uint8_t>& out) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, 16 + MAX_WBITS) != Z_OK) return false;
  out.resize(in.size() * 4 + (1 << 20));
  zs.next_in = const_cast<Bytef*>(in.data());
  zs.avail_in = static_cast<uInt>(in.size());
  size_t written = 0;
  int ret = Z_OK;
  while (true) {
    if (written == out.size()) out.resize(out.size() * 2);
    zs.next_out = out.data() + written;
    zs.avail_out = static_cast<uInt>(out.size() - written);
    ret = inflate(&zs, Z_NO_FLUSH);
    written = out.size() - zs.avail_out;
    if (ret == Z_STREAM_END) break;
    if (ret != Z_OK) {
      inflateEnd(&zs);
      return false;
    }
  }
  inflateEnd(&zs);
  out.resize(written);
  return true;
}

bool load_blob(const char* path, std::vector<uint8_t>& blob) {
  std::vector<uint8_t> raw;
  if (!read_file(path, raw)) return false;
  if (raw.size() >= 2 && raw[0] == 0x1f && raw[1] == 0x8b) {
    return gunzip(raw, blob);
  }
  blob = std::move(raw);
  return true;
}

// ---- NIfTI-1 parse + convert -----------------------------------------------

struct NiftiInfo {
  int ndim;
  int64_t dims[7];
  int datatype;
  int64_t vox_offset;
  float scl_slope;
  float scl_inter;
  bool swap;  // big-endian payload
};

template <typename T>
T bswap(T v) {
  uint8_t* p = reinterpret_cast<uint8_t*>(&v);
  for (size_t i = 0; i < sizeof(T) / 2; ++i) std::swap(p[i], p[sizeof(T) - 1 - i]);
  return v;
}

bool parse_header(const std::vector<uint8_t>& blob, NiftiInfo* info) {
  if (blob.size() < 352) return false;
  int32_t sizeof_hdr;
  std::memcpy(&sizeof_hdr, blob.data(), 4);
  bool swap = false;
  if (sizeof_hdr != 348) {
    sizeof_hdr = bswap(sizeof_hdr);
    if (sizeof_hdr != 348) return false;
    swap = true;
  }
  int16_t dim[8];
  std::memcpy(dim, blob.data() + 40, 16);
  int16_t datatype;
  std::memcpy(&datatype, blob.data() + 70, 2);
  float vox_offset, scl_slope, scl_inter;
  std::memcpy(&vox_offset, blob.data() + 108, 4);
  std::memcpy(&scl_slope, blob.data() + 112, 4);
  std::memcpy(&scl_inter, blob.data() + 116, 4);
  if (swap) {
    for (int i = 0; i < 8; ++i) dim[i] = bswap(dim[i]);
    datatype = bswap(datatype);
    vox_offset = bswap(vox_offset);
    scl_slope = bswap(scl_slope);
    scl_inter = bswap(scl_inter);
  }
  info->ndim = dim[0];
  if (info->ndim < 1 || info->ndim > 7) return false;
  for (int i = 0; i < info->ndim; ++i) info->dims[i] = dim[i + 1];
  info->datatype = datatype;
  info->vox_offset = static_cast<int64_t>(vox_offset);
  info->scl_slope = scl_slope;
  info->scl_inter = scl_inter;
  info->swap = swap;
  return true;
}

template <typename T>
void convert(const uint8_t* src, float* dst, int64_t n, bool swap,
             float slope, float inter) {
  const T* s = reinterpret_cast<const T*>(src);
  bool scale = (slope != 0.0f && slope != 1.0f) || inter != 0.0f;
  float k = (slope == 0.0f) ? 1.0f : slope;
  for (int64_t i = 0; i < n; ++i) {
    T v = s[i];
    if (swap) v = bswap(v);
    float f = static_cast<float>(v);
    dst[i] = scale ? f * k + inter : f;
  }
}

int decode_to_f32(const char* path, float* out, int64_t out_elems,
                  int64_t* dims_out /* len 8: ndim + 7 dims */) {
  std::vector<uint8_t> blob;
  if (!load_blob(path, blob)) return -1;
  NiftiInfo info;
  if (!parse_header(blob, &info)) return -2;
  int64_t n = 1;
  for (int i = 0; i < info.ndim; ++i) n *= info.dims[i];
  if (dims_out) {
    dims_out[0] = info.ndim;
    for (int i = 0; i < 7; ++i) dims_out[1 + i] = (i < info.ndim) ? info.dims[i] : 1;
  }
  if (!out) return 0;  // probe call: report dims only
  if (n > out_elems) return -3;
  const uint8_t* payload = blob.data() + info.vox_offset;
  int64_t avail = static_cast<int64_t>(blob.size()) - info.vox_offset;
  float sl = info.scl_slope, in = info.scl_inter;
  bool sw = info.swap;
  switch (info.datatype) {
    case 2:    if (avail < n * 1) return -4; convert<uint8_t>(payload, out, n, false, sl, in); break;
    case 256:  if (avail < n * 1) return -4; convert<int8_t>(payload, out, n, false, sl, in); break;
    case 4:    if (avail < n * 2) return -4; convert<int16_t>(payload, out, n, sw, sl, in); break;
    case 512:  if (avail < n * 2) return -4; convert<uint16_t>(payload, out, n, sw, sl, in); break;
    case 8:    if (avail < n * 4) return -4; convert<int32_t>(payload, out, n, sw, sl, in); break;
    case 768:  if (avail < n * 4) return -4; convert<uint32_t>(payload, out, n, sw, sl, in); break;
    case 16:   if (avail < n * 4) return -4; convert<float>(payload, out, n, sw, sl, in); break;
    case 64:   if (avail < n * 8) return -4; convert<double>(payload, out, n, sw, sl, in); break;
    case 1024: if (avail < n * 8) return -4; convert<int64_t>(payload, out, n, sw, sl, in); break;
    default: return -5;
  }
  return 0;
}

}  // namespace

extern "C" {

// Decode one NIfTI file (optionally gzipped) into a float32 buffer
// (Fortran voxel order as stored).  out may be null to probe dims.
// Returns 0 on success, negative error codes otherwise.
int vaegam_nifti_decode_f32(const char* path, float* out, int64_t out_elems,
                            int64_t* dims_out) {
  return decode_to_f32(path, out, out_elems, dims_out);
}

// Write n single-file NIfTI-1 volumes in parallel (the output stage's
// batch writer: the recon pass emits 10 maps x batch files per dispatch —
// vae_reg_GP.py:605-620 writes these synchronously one by one; here the
// encode (C->Fortran voxel transpose) and file writes run off the GIL on a
// worker pool, overlapped with the next batch's device compute).
//
// header: the 352-byte pre-encoded header+pad, shared by all volumes
//         (same shape/dtype/affine per flush; per-subject templates are
//         grouped by the caller).
// data:   contiguous float32, n volumes x (d0*d1*d2) elements, each volume
//         C-ordered over dims (d0,d1,d2).  Written in Fortran order as
//         NIfTI requires.
// Returns per-file status: 0 ok, -1 open failure, -2 short write.
void vaegam_nifti_write_batch_f32(const char* header, int64_t header_len,
                                  const float* data, int64_t d0, int64_t d1,
                                  int64_t d2, const char** paths,
                                  int* statuses, int n, int n_threads) {
  const int64_t vox = d0 * d1 * d2;
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> pool;
  std::vector<int> next(1, 0);
  std::mutex mu;
  auto worker = [&]() {
    std::vector<float> fbuf(static_cast<size_t>(vox));
    while (true) {
      int i;
      {
        std::lock_guard<std::mutex> lock(mu);
        if (next[0] >= n) return;
        i = next[0]++;
      }
      const float* src = data + static_cast<int64_t>(i) * vox;
      // C-order (i0 slowest) -> Fortran order (i0 fastest): dst linear
      // index i0 + i1*d0 + i2*d0*d1 reads src[i0*d1*d2 + i1*d2 + i2].
      for (int64_t i2 = 0; i2 < d2; ++i2)
        for (int64_t i1 = 0; i1 < d1; ++i1) {
          float* dst = fbuf.data() + i1 * d0 + i2 * d0 * d1;
          const float* s = src + i1 * d2 + i2;
          for (int64_t i0 = 0; i0 < d0; ++i0)
            dst[i0] = s[i0 * d1 * d2];
        }
      FILE* f = std::fopen(paths[i], "wb");
      if (!f) { statuses[i] = -1; continue; }
      bool ok =
          std::fwrite(header, 1, static_cast<size_t>(header_len), f) ==
              static_cast<size_t>(header_len) &&
          std::fwrite(fbuf.data(), sizeof(float), static_cast<size_t>(vox),
                      f) == static_cast<size_t>(vox);
      std::fclose(f);
      statuses[i] = ok ? 0 : -2;
    }
  };
  int k = n_threads < n ? n_threads : n;
  for (int t = 0; t < k; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

// Decode n files in parallel with up to n_threads workers.
// outs[i] must be preallocated with out_elems[i] capacity.
// statuses[i] receives the per-file return code.
void vaegam_nifti_decode_many_f32(const char** paths, float** outs,
                                  const int64_t* out_elems,
                                  int64_t* dims_out /* n x 8, may be null */,
                                  int* statuses, int n, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> pool;
  std::vector<int> next(1, 0);
  std::mutex* mu = new std::mutex();
  auto worker = [&]() {
    while (true) {
      int i;
      {
        std::lock_guard<std::mutex> lock(*mu);
        if (next[0] >= n) return;
        i = next[0]++;
      }
      statuses[i] = decode_to_f32(paths[i], outs[i], out_elems[i],
                                  dims_out ? dims_out + 8 * i : nullptr);
    }
  };
  int k = n_threads < n ? n_threads : n;
  for (int t = 0; t < k; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  delete mu;
}

}  // extern "C"
