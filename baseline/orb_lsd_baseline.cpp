// Measured C++ baseline for the PSL-SLAM per-frame tracking hot path.
//
// The full reference (/root/reference) cannot be built in this image (no
// Eigen3/Pangolin/PCL), but its per-frame hot path is OpenCV work that CAN
// be measured here with the system OpenCV 4.6 — the same library family the
// reference links (CMakeLists.txt:31-41, line_descriptor vendored from the
// same module). This program times, per frame, the reference Frame
// construction + matching pipeline:
//
//   1. ORB extraction: 1000 features, 8 levels, scale 1.2, FAST 20
//      (ORBextractor.cc:410 + TUM1.yaml:41-49 -> ORBextractor::operator(),
//      ORBextractor.cc:1043).
//   2. LSD line detection, 1 octave + LBD binary descriptors
//      (LINEextractor::operator(), add_src/LineExtractor.cpp:325-366;
//      TUM1.yaml LSD nLevels=1, nFeatures<=200).
//   3. ORB descriptor matching vs the previous frame, Hamming kNN + ratio
//      (ORBmatcher::SearchByProjection cost class, ORBmatcher.cc:1328).
//   4. LBD line matching vs the previous frame (LSDmatcher::match,
//      add_src/LSDmatcher.cpp:354-413).
//
// This UNDERSTATES the reference's real per-frame cost: the reference also
// runs per-line depth-sampled 3D RANSAC fits (LineExtractor.cpp:216-323),
// fan detection (PartiallyRecoverConnectivity.cpp:14), plane association
// (Map.cc:204), and TWO g2o pose optimizations of 4x10 LM iterations each
// (Optimizer.cc:239, called at Tracking.cc:968 and 1331) — none of which
// are measured here because g2o is unavailable. The measured number is
// therefore an UPPER BOUND on the reference's frames/s (a conservative
// denominator for vs_baseline).
//
// Usage: orb_lsd_baseline <dir-with-%06d.pgm> <n_frames> [n_lines_cap]
// Prints one JSON line: {"median_ms":..,"mean_ms":..,"fps":..}.

#include <opencv2/core.hpp>
#include <opencv2/features2d.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/line_descriptor.hpp>

#include <algorithm>
#include <chrono>
#include <cstdio>
#include <string>
#include <vector>

using namespace cv;
using line_descriptor::BinaryDescriptor;
using line_descriptor::KeyLine;
using line_descriptor::LSDDetector;

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: %s <dir> <n_frames> [line_cap]\n", argv[0]);
    return 1;
  }
  std::string dir = argv[1];
  int n = atoi(argv[2]);
  size_t line_cap = argc > 3 ? (size_t)atoi(argv[3]) : 200;  // TUM1.yaml:59

  std::vector<Mat> frames;
  for (int i = 0; i < n; i++) {
    char buf[64];
    snprintf(buf, sizeof(buf), "/%06d.pgm", i);
    Mat im = imread(dir + buf, IMREAD_GRAYSCALE);
    if (im.empty()) {
      fprintf(stderr, "missing frame %d\n", i);
      return 1;
    }
    frames.push_back(im);
  }

  // TUM1.yaml:41-49: nFeatures 1000, scaleFactor 1.2, nLevels 8, FAST 20/7.
  Ptr<ORB> orb = ORB::create(1000, 1.2f, 8, 19, 0, 2, ORB::HARRIS_SCORE, 31, 20);
  Ptr<LSDDetector> lsd;
  Ptr<BinaryDescriptor> lbd = BinaryDescriptor::createBinaryDescriptor();
  bool use_lsd = true;
  try {  // OpenCV builds with the LSD impl removed throw at detect time.
    lsd = LSDDetector::createLSDDetector();
    std::vector<KeyLine> probe;
    lsd->detect(frames[0], probe, 2, 1);
  } catch (const cv::Exception&) {
    use_lsd = false;  // fall back to the EDLines detector inside LBD
    fprintf(stderr, "LSD unavailable; using BinaryDescriptor EDLines\n");
  }
  BFMatcher pmatch(NORM_HAMMING);
  BFMatcher lmatch(NORM_HAMMING);

  Mat prev_desc, prev_ldesc;
  std::vector<double> ms;
  for (int i = 0; i < n; i++) {
    auto t0 = std::chrono::steady_clock::now();

    // 1. ORB points (Frame::ExtractORB).
    std::vector<KeyPoint> kps;
    Mat desc;
    orb->detectAndCompute(frames[i], noArray(), kps, desc);

    // 2. LSD/EDLines + LBD (Frame::ExtractLSD front half).
    std::vector<KeyLine> lines;
    if (use_lsd)
      lsd->detect(frames[i], lines, 2, 1);
    else
      lbd->detect(frames[i], lines);
    if (lines.size() > line_cap) {  // keep longest (FilterShortLines class)
      std::nth_element(lines.begin(), lines.begin() + line_cap, lines.end(),
                       [](const KeyLine& a, const KeyLine& b) {
                         return a.lineLength > b.lineLength;
                       });
      lines.resize(line_cap);
    }
    Mat ldesc;
    if (!lines.empty()) lbd->compute(frames[i], lines, ldesc);

    // 3+4. Descriptor matching vs previous frame (ratio 0.9 like
    // ORBmatcher mfNNratio for tracking; LSDmatcher nn ratio 0.75).
    if (!prev_desc.empty() && !desc.empty()) {
      std::vector<std::vector<DMatch>> knn;
      pmatch.knnMatch(desc, prev_desc, knn, 2);
      int good = 0;
      for (auto& m : knn)
        if (m.size() == 2 && m[0].distance < 0.9f * m[1].distance) good++;
      (void)good;
    }
    if (!prev_ldesc.empty() && !ldesc.empty()) {
      std::vector<std::vector<DMatch>> knn;
      lmatch.knnMatch(ldesc, prev_ldesc, knn, 2);
    }
    prev_desc = desc;
    prev_ldesc = ldesc;

    auto t1 = std::chrono::steady_clock::now();
    ms.push_back(std::chrono::duration<double, std::milli>(t1 - t0).count());
  }

  // Skip the first 3 frames (cache/alloc warm-up), like rgbd_tum's
  // median-of-all accounting but robust to the cold start.
  std::vector<double> warm(ms.begin() + std::min<size_t>(3, ms.size()),
                           ms.end());
  if (warm.empty()) warm = ms;
  std::sort(warm.begin(), warm.end());
  double med = warm[warm.size() / 2];
  double mean = 0;
  for (double v : warm) mean += v;
  mean /= warm.size();
  printf("{\"median_ms\": %.3f, \"mean_ms\": %.3f, \"fps\": %.3f, \"frames\": %d, \"detector\": \"%s\"}\n",
         med, mean, 1000.0 / med, (int)warm.size(), use_lsd ? "lsd" : "edlines");
  return 0;
}
