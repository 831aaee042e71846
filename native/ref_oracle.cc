// ref_oracle — standalone differential-test ORACLE re-implementing the
// reference's dataset decode semantics, dependency-free (no Eigen/Ceres/
// glog), so the Python decoders in ct_icp_tpu/datasets/dataset.py can be
// diffed against the reference BEHAVIOR without real data on disk.
//
// Re-implemented (not copied) from the reference spec:
//   * NCLT velodyne_hits.bin stream decode — reference
//     src/ct_icp/dataset.cpp:447-535 (NCLTIterator::DoNext/NextBatch):
//     batches framed by 4x u16 magic == 44444, then u32 num_hits,
//     u64 utime, u32 padding, then num_hits * (3x u16 xyz + 2x u8);
//     coordinates decode as v * 0.005 - 100.0; the batch utime is every
//     point's timestamp; num_aggregated batches concatenate into a frame.
//   * KITTI HDL-64 frame filter — dataset.cpp:85-111: drop z <= -5, rotate
//     every kept point by 0.205 deg about normalize(p x uz).
//   * GT calibration conjugation — dataset.cpp:998-1098 (LoadPoses):
//     M' = Calib^-1 * P * Calib with a general 4x4 inverse (the reference
//     calls Eigen's generic .inverse(); calibration blocks are only
//     approximately rigid, so the oracle matches that choice), quaternion
//     extracted from the rotation block and normalized.
//
// This file is a TEST oracle only (consumed by
// tests/test_decoder_differential.py via ctypes); it is not part of the
// runtime pipeline.
//
// Build: make -C native   (produces libref_oracle.so)

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// --- NCLT stream decode ---------------------------------------------------
// Decodes the byte stream into frames of num_aggregated batches each
// (reference DoNext aggregation loop, dataset.cpp:454-476). Returns the
// number of frames written; -2 on a magic-number mismatch (the reference
// CHECKs); stops cleanly at end-of-stream (a truncated trailing batch ends
// the stream like the reference's eof()-gated loop).
//   xyz_out: [cap*3] doubles, ts_out: [cap] doubles (decoded points,
//   all frames concatenated), frame_sizes: [max_frames] point counts.
long ref_nclt_decode(const uint8_t* buf, long nbytes, int num_aggregated,
                     int max_frames, double* xyz_out, double* ts_out,
                     long cap, long* frame_sizes) {
  long pos = 0;
  long total = 0;
  long nframes = 0;
  while (nframes < max_frames) {
    long frame_points = 0;
    bool stream_ended = false;
    for (int b = 0; b < num_aggregated; ++b) {
      if (pos + 24 > nbytes) {  // no full header left: end of stream
        stream_ended = true;
        break;
      }
      uint16_t magic[4];
      std::memcpy(magic, buf + pos, 8);
      for (int i = 0; i < 4; ++i)
        if (magic[i] != 44444) return -2;
      uint32_t num_hits;
      uint64_t utime;
      std::memcpy(&num_hits, buf + pos + 8, 4);
      std::memcpy(&utime, buf + pos + 12, 8);
      pos += 24;  // header incl. 4 padding bytes
      const long payload = 8L * num_hits;  // 3x u16 + 2x u8 per hit
      if (pos + payload > nbytes) {  // truncated batch: end of stream
        stream_ended = true;
        break;
      }
      for (uint32_t p = 0; p < num_hits; ++p) {
        uint16_t xyz[3];
        std::memcpy(xyz, buf + pos + 8L * p, 6);
        if (total < cap) {
          xyz_out[total * 3 + 0] = (double)xyz[0] * 0.005 - 100.0;
          xyz_out[total * 3 + 1] = (double)xyz[1] * 0.005 - 100.0;
          xyz_out[total * 3 + 2] = (double)xyz[2] * 0.005 - 100.0;
          ts_out[total] = (double)utime;
        }
        ++total;
        ++frame_points;
      }
      pos += payload;
    }
    if (frame_points == 0 && stream_ended) break;
    frame_sizes[nframes++] = frame_points;
    if (stream_ended) break;
  }
  return nframes;
}

// --- KITTI HDL-64 frame filter -------------------------------------------
// Reference kitti_frame_filter (dataset.cpp:85-111). Writes the corrected
// kept points to xyz_out and their source indices to kept_idx; returns the
// kept count. Rotation: Rodrigues form of AngleAxis(0.205 deg, axis).
long ref_kitti_filter(const double* xyz_in, long n, double* xyz_out,
                      long* kept_idx) {
  const double kMinZ = -5.0;
  const double ang = 0.205 * M_PI / 180.0;
  const double c = std::cos(ang), s = std::sin(ang);
  long kept = 0;
  for (long i = 0; i < n; ++i) {
    const double x = xyz_in[i * 3 + 0];
    const double y = xyz_in[i * 3 + 1];
    const double z = xyz_in[i * 3 + 2];
    if (z <= kMinZ) continue;
    // axis = normalize(p x uz) = normalize((y, -x, 0))
    double ax = y, ay = -x, az = 0.0;
    const double norm = std::sqrt(ax * ax + ay * ay);
    ax /= norm;
    ay /= norm;
    // Rodrigues: p' = p c + (k x p) s + k (k.p) (1 - c)
    const double kdotp = ax * x + ay * y;
    const double cx = ay * z - az * y;
    const double cy = az * x - ax * z;
    const double cz = ax * y - ay * x;
    xyz_out[kept * 3 + 0] = x * c + cx * s + ax * kdotp * (1.0 - c);
    xyz_out[kept * 3 + 1] = y * c + cy * s + ay * kdotp * (1.0 - c);
    xyz_out[kept * 3 + 2] = z * c + cz * s + az * kdotp * (1.0 - c);
    kept_idx[kept] = i;
    ++kept;
  }
  return kept;
}

namespace {

// General 4x4 inverse by Gauss-Jordan with partial pivoting (the
// reference's Eigen::Matrix4d::inverse() is exact-general too — calib
// blocks are only approximately rigid). Row-major. Returns false if
// singular.
bool inv4(const double* m, double* out) {
  double a[4][8];
  for (int r = 0; r < 4; ++r) {
    for (int c = 0; c < 4; ++c) {
      a[r][c] = m[r * 4 + c];
      a[r][c + 4] = (r == c) ? 1.0 : 0.0;
    }
  }
  for (int col = 0; col < 4; ++col) {
    int piv = col;
    for (int r = col + 1; r < 4; ++r)
      if (std::fabs(a[r][col]) > std::fabs(a[piv][col])) piv = r;
    if (std::fabs(a[piv][col]) < 1e-300) return false;
    if (piv != col)
      for (int c = 0; c < 8; ++c) std::swap(a[piv][c], a[col][c]);
    const double d = a[col][col];
    for (int c = 0; c < 8; ++c) a[col][c] /= d;
    for (int r = 0; r < 4; ++r) {
      if (r == col) continue;
      const double f = a[r][col];
      for (int c = 0; c < 8; ++c) a[r][c] -= f * a[col][c];
    }
  }
  for (int r = 0; r < 4; ++r)
    for (int c = 0; c < 4; ++c) out[r * 4 + c] = a[r][c + 4];
  return true;
}

void mul4(const double* a, const double* b, double* out) {
  for (int r = 0; r < 4; ++r)
    for (int c = 0; c < 4; ++c) {
      double s = 0.0;
      for (int k = 0; k < 4; ++k) s += a[r * 4 + k] * b[k * 4 + c];
      out[r * 4 + c] = s;
    }
}

// Quaternion (w, x, y, z) from the rotation block, Shepperd's max-trace
// branch selection (what Eigen's Quaternion(Matrix3) does), then
// normalized (the reference normalizes after extraction).
void quat_from_rot(const double* m /*4x4 row-major*/, double* q) {
  const double r00 = m[0], r01 = m[1], r02 = m[2];
  const double r10 = m[4], r11 = m[5], r12 = m[6];
  const double r20 = m[8], r21 = m[9], r22 = m[10];
  const double tr = r00 + r11 + r22;
  double w, x, y, z;
  if (tr > 0.0) {
    double s = std::sqrt(tr + 1.0) * 2.0;
    w = 0.25 * s;
    x = (r21 - r12) / s;
    y = (r02 - r20) / s;
    z = (r10 - r01) / s;
  } else if (r00 > r11 && r00 > r22) {
    double s = std::sqrt(1.0 + r00 - r11 - r22) * 2.0;
    w = (r21 - r12) / s;
    x = 0.25 * s;
    y = (r01 + r10) / s;
    z = (r02 + r20) / s;
  } else if (r11 > r22) {
    double s = std::sqrt(1.0 + r11 - r00 - r22) * 2.0;
    w = (r02 - r20) / s;
    x = (r01 + r10) / s;
    y = 0.25 * s;
    z = (r12 + r21) / s;
  } else {
    double s = std::sqrt(1.0 + r22 - r00 - r11) * 2.0;
    w = (r10 - r01) / s;
    x = (r02 + r20) / s;
    y = (r12 + r21) / s;
    z = 0.25 * s;
  }
  const double n = std::sqrt(w * w + x * x + y * y + z * z);
  q[0] = w / n;
  q[1] = x / n;
  q[2] = y / n;
  q[3] = z / n;
}

}  // namespace

// --- GT calibration conjugation ------------------------------------------
// Reference LoadPoses/transform_poses (dataset.cpp:1004-1029):
// M' = Calib^-1 * P * Calib per pose; quat normalized after extraction.
// poses: n row-major 4x4; outputs: quat (w,x,y,z) [n*4] and tr [n*3].
// Returns 0 on success, -1 if calib is singular.
int ref_conjugate_poses(const double* calib, const double* poses, long n,
                        double* quat_out, double* tr_out) {
  double calib_inv[16];
  if (!inv4(calib, calib_inv)) return -1;
  double tmp[16], m[16];
  for (long i = 0; i < n; ++i) {
    mul4(calib_inv, poses + i * 16, tmp);
    mul4(tmp, calib, m);
    quat_from_rot(m, quat_out + i * 4);
    tr_out[i * 3 + 0] = m[3];
    tr_out[i * 3 + 1] = m[7];
    tr_out[i * 3 + 2] = m[11];
  }
  return 0;
}

// KITTI GT timestamp convention (dataset.cpp:1030-1044): mid-scan
// timestamps (i + 0.5) * 0.1 for KITTI/KITTI_raw/KITTI_360, i * 0.1 for
// KITTI_CARLA. Exposed so the test pins the constant against the oracle.
double ref_kitti_gt_timestamp(long index, int carla) {
  return carla ? (double)index * 0.1 : ((double)index + 0.5) * 0.1;
}

}  // extern "C"
